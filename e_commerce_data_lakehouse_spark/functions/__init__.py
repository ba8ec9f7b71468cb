from e_commerce_data_lakehouse_spark.functions.exact import (
    avg_money,
    dsum,
    sum_money,
)

__all__ = ["sum_money", "avg_money", "dsum"]
