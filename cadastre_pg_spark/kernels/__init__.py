"""Pure-NumPy geo/text kernels. No Spark imports here — these modules are
shipped to executors inside pandas UDF closures and are also the
single-process oracle used by the tests (distributed == oracle is the
core correctness invariant)."""
