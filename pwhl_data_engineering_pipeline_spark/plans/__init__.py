"""Pipeline stages: the reference's 7 scripts recomposed as lazy
DataFrame→DataFrame functions chained in one SparkSession (SURVEY.md §3 EP1/EP2)."""

from . import capacity, corpus, integrate, pipeline, sales, star, weather  # noqa: F401
