"""Expression compilers: ``[[ ]]`` templates, JQ subset, JSONPath."""

from optimus_any2any_spark.compiler.template import Template, compile_template

__all__ = ["Template", "compile_template"]
