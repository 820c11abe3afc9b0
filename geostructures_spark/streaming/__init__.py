"""streaming layer of geostructures_spark."""
