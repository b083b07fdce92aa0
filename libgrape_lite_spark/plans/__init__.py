from libgrape_lite_spark.plans.superstep import IterationDriver

__all__ = ["IterationDriver"]
