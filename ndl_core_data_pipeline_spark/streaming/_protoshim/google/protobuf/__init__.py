"""Minimal from-spec protobuf runtime (wire format + descriptor.proto
are public documentation; see _shim_impl.py). Only the surface pyspark's
generated StateMessage_pb2 module touches is provided."""

_SPARK_GRAFT_SHIM = True
__version__ = "0.0-spark-graft-shim"
