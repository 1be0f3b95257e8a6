from .jdbc import (  # noqa: F401
    incremental_dbtable,
    jdbc_properties,
    jdbc_url,
    partition_options,
    read_jdbc_table,
)
