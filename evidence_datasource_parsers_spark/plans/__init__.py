from evidence_datasource_parsers_spark.plans.catalog import (  # noqa: F401
    CATALOG,
    CatalogQuery,
    load,
)
