"""geocode_spark — PySpark-native geocoding & spatial-join engine.

Public surface (see geocoder.GeocoderSpark for the reference-parity API):

    from geocode_spark import GeocoderSpark, get_spark

    spark = get_spark()
    geo = GeocoderSpark(spark)
    geo.reverse_geocode_llsoa(points_df)
"""

from .geocoder import STATUS_CODES, GeocoderSpark, status_string
from .session import get_spark

__all__ = ["GeocoderSpark", "get_spark", "STATUS_CODES", "status_string"]
