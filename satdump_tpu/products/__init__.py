"""products subpackage."""
