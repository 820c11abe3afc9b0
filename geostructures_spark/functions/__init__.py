"""functions layer of geostructures_spark."""
