"""Scalar value semantics: typed-value parsing, complex values, hashing."""
