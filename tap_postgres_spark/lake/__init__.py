from .table import CommitConflictError, LakeTable  # noqa: F401

# submodules: .derived (incremental derived tables), .inverted (generic
# maintained inverted indexes — see vectorindex / digestindex for the
# IVF and content-digest instantiations)
