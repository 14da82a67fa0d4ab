"""Namespace root for the vendored protobuf shim (see arcon_spark.protoshim)."""
