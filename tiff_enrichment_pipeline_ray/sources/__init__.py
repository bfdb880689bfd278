"""Sources/sinks: table IO facade + deterministic synthetic fixture layers."""
