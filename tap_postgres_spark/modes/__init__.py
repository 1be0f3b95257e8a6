from .bootstrap import bootstrap_snapshot  # noqa: F401
from .full_table import full_table_scan  # noqa: F401
from .incremental import incremental_scan  # noqa: F401
from .log_based import CdcPipeline  # noqa: F401
from .txn import TxnBoundaryBuffer  # noqa: F401
