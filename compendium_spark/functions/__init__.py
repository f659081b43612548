"""Column-expression function library."""
