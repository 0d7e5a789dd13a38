"""Device compute kernels: grid aggregation, sorting, hashing helpers."""
