"""Minimal pure-Python protobuf runtime — see arcon_spark.protoshim.

Implements the subset of the public protobuf runtime API that generated
``*_pb2`` modules and PySpark's transformWithState clients require.
"""

__version__ = "6.33.0+arcon-shim"
