from evidence_datasource_parsers_spark.operators.joins import (  # noqa: F401
    enrich_join_back,
    union_by_name,
)
from evidence_datasource_parsers_spark.operators.reshape import (  # noqa: F401
    melt,
    one_hot_to_array,
    parse_stringified_array,
)
from evidence_datasource_parsers_spark.operators.windows import (  # noqa: F401
    top_n_per_group,
)
