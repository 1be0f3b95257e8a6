from .table import CommitConflictError, LakeTable  # noqa: F401
