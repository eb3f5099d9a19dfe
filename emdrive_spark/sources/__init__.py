"""emdrive-spark: PySpark-native engine with the capabilities of Twixes/emdrive."""
