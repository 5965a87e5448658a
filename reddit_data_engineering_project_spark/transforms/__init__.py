"""Reference-pipeline transforms: transform_post semantics (R4-R9)
and the registered pipeline queries (R1-R15 analogs)."""
