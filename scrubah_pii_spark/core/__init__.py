"""Pure-Python kernels. No Spark imports here — these run inside pandas UDFs."""
