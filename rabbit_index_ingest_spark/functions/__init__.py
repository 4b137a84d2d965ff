"""Scalar/column function library: text analytics, hashing, vector math."""
