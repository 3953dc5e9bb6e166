"""Column-expression helpers (pure functions Column -> Column).

Everything here compiles to built-in Catalyst expressions — JVM-side,
whole-stage-codegen'd, no Python in the data path.
"""
