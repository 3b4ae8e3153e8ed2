"""Scalar-function layer: struct flattening, coercing casts, JSON
boundary serialization, portable hashing, text analysis primitives.

Everything here is pure Column expressions (JVM-side, codegen-friendly);
no Python UDFs.
"""
