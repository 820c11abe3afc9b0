"""sources layer of geostructures_spark."""
