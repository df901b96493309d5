from gmail_etl_spark.sources.fixtures import fixture_messages, fixture_raw_df

__all__ = ["fixture_messages", "fixture_raw_df"]
