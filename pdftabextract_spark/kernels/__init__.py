"""Pure-numpy kernels: the numeric core shared by Spark pandas-UDF stages,
tests, and driver-side model fitting. No Spark imports allowed here."""
