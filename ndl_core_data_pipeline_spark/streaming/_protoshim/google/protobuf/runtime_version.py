"""Runtime-version validation stand-in: the shim targets exactly the
generated module pyspark ships, so the gencode/runtime version check is
a no-op (it exists upstream to catch gencode newer than the runtime)."""

from types import SimpleNamespace

Domain = SimpleNamespace(GOOGLE_INTERNAL=1, PUBLIC=2)


def ValidateProtobufRuntimeVersion(*_args, **_kwargs) -> None:
    return None
