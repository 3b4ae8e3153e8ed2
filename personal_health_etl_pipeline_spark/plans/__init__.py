"""Named analytical plans: the flagship star-schema queries and the
helpers that make their float aggregates oracle-exact."""
