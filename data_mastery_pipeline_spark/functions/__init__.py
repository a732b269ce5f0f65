"""Scalar column-expression builders (SURVEY §2.C/§2.I) — all Catalyst
expressions, no UDFs, so they stay inside whole-stage codegen."""
