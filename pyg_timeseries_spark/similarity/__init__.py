"""similarity subpackage."""
