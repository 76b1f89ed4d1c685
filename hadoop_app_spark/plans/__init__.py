from hadoop_app_spark.plans.max_temperature import max_temperature, run_max_temperature
from hadoop_app_spark.plans.reduce_join import reduce_join, run_reduce_join
from hadoop_app_spark.plans.recommend import recommend_cars, run_user_hotcar, run_user_newcar

__all__ = [
    "max_temperature",
    "run_max_temperature",
    "reduce_join",
    "run_reduce_join",
    "recommend_cars",
    "run_user_hotcar",
    "run_user_newcar",
]
