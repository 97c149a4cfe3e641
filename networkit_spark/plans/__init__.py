from networkit_spark.plans.iterative import Checkpointer

__all__ = ["Checkpointer"]
