"""TypedList rewrites (reference ``typed_list/rewriting.py``: one
inplace-append rewrite — inplace is donation on the XLA path, so the
module is a registration point only)."""
