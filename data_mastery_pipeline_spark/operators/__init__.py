"""Operator library — every operator is a pure DataFrame → DataFrame
function so each is independently testable against the DuckDB oracle
(SURVEY §7 guiding decisions)."""
