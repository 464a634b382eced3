"""Utilities: conformance oracle, image IO, profiling, native bindings."""
