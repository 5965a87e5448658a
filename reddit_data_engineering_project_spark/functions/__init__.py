"""Function batteries: scalar (Q14-Q16), array/map/JSON (Q17),
portable numeric rounding, and the pandas-UDF surface (Q20)."""
