from .table import CommitConflictError, LakeTable  # noqa: F401

# submodules: .derived (incremental derived tables), .aggview
# (incremental GROUP BY views), .snapshots (cross-table consistent read
# points), .inverted (generic maintained inverted indexes — see
# vectorindex / digestindex for the IVF and content-digest
# instantiations)
