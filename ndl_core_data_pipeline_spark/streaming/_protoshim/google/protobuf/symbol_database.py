"""Symbol database stand-in — the generated module only grabs the
default instance; nothing is ever looked up through it on this path."""


class _SymbolDatabase:
    def RegisterMessage(self, message):
        return message


_DEFAULT = _SymbolDatabase()


def Default() -> _SymbolDatabase:
    return _DEFAULT
