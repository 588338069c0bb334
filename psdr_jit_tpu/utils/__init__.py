"""IO, logging, and misc utilities."""
