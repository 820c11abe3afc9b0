"""plans layer of geostructures_spark."""
