"""Physical-plan inspection utilities."""

from optimus_any2any_spark.plans.inspect import plan_report

__all__ = ["plan_report"]
