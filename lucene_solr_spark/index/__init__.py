"""Index-side engine: segment build, posting codec, manifest, merge."""
