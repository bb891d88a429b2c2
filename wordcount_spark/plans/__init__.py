from wordcount_spark.plans.explain import formatted_plan, plan_has

__all__ = ["formatted_plan", "plan_has"]
