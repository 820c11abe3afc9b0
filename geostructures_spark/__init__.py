"""geostructures_spark: a PySpark-native geo-temporal spatial-join + tiling
engine with the query capabilities of ccbest/geostructures, built Spark-first
(DataFrame/Catalyst + vectorized Arrow UDFs) for web-scale page corpora.
"""
__version__ = '0.1.0'
