from fiat2_spark.plans import ast  # noqa: F401
from fiat2_spark.plans.compile import compile_expr, compile_column  # noqa: F401
from fiat2_spark.plans.interp import run_command  # noqa: F401
