from evidence_datasource_parsers_spark.plans.catalog import (  # noqa: F401
    CATALOG,
    CatalogQuery,
    load,
)

# registration side-effects: text/dedup/similarity queries
import evidence_datasource_parsers_spark.plans.catalog_text  # noqa: E402,F401
