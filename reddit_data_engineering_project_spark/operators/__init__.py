"""Operator modules: relational core, joins, aggregates, windows,
set ops, upsert, sinks, bucketing, and the north-star X1-X5 family."""
