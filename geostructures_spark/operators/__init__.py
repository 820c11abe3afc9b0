"""operators layer of geostructures_spark."""
