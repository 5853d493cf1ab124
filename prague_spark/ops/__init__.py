"""DataFrame-plane operators (SQL-verifiable surface)."""
