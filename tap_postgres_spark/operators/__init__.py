from .lww import (  # noqa: F401
    fold_last_writer_wins,
    fold_last_writer_wins_agg,
    salted_fold_last_writer_wins,
)
from .temporal import (  # noqa: F401
    asof_join,
    point_in_time_join,
    range_join,
)
