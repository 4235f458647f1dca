"""Physical-plan inspection helpers."""

from mapreduce_hadoop_spark.plans.checks import executed_plan, plan_counts

__all__ = ["executed_plan", "plan_counts"]
