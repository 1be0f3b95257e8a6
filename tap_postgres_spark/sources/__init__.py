from .jdbc import (  # noqa: F401
    DISCOVERY_COLUMNS,
    discover_jdbc,
    discovery_dbtable,
    incremental_dbtable,
    jdbc_properties,
    jdbc_url,
    partition_options,
    read_jdbc_table,
    streamdefs_from_columns,
)
