"""Plan-level helpers: layouts (index analogs), routing."""
