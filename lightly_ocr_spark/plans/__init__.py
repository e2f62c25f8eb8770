"""Session construction and declarative (Catalyst-optimized) plan helpers."""
