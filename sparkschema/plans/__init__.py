"""End-to-end validation plans: compile once, run row-level + table-level
checks in as few passes as Catalyst allows."""
