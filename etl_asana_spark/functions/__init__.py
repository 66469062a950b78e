"""Column-expression helpers: parity-exact aggregation, vector math, text metrics."""
