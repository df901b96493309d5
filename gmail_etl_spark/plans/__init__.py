from gmail_etl_spark.plans.catalog import CATALOG, CatalogQuery, load_table, query, oracle_map, query_map

__all__ = ["CATALOG", "CatalogQuery", "load_table", "query", "oracle_map", "query_map"]
