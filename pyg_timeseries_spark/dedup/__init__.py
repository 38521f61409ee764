"""dedup subpackage."""
