"""Pure-NumPy compute kernels (no Spark imports) — the exact-math layer
invoked from pandas/Arrow UDFs by the operators package."""
