"""textops subpackage."""
