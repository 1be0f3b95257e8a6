from .lww import fold_last_writer_wins, salted_fold_last_writer_wins  # noqa: F401
