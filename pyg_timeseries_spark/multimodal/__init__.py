"""multimodal subpackage."""
