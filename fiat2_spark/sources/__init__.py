from fiat2_spark.sources.io import (  # noqa: F401
    read_table,
    register_views,
    to_json_records,
    write_table,
)
