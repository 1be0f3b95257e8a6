from .lww import (  # noqa: F401
    fold_last_writer_wins,
    fold_last_writer_wins_agg,
    salted_fold_last_writer_wins,
)
