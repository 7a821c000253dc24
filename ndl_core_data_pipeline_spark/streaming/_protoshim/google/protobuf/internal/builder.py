"""Builder stand-in for the two calls every generated pb2 module makes.

`BuildMessageAndEnumDescriptors` injects `_MESSAGENAME` descriptor
placeholders (the generated tail then pokes `_serialized_start/_end`
onto them); `BuildTopDescriptorsAndMessages` creates the message
classes and file-level enum constants in the module globals — the
surface pyspark's state clients consume (`stateMessage.StateRequest`,
`stateMessage.PRE_INIT`, ...)."""

from __future__ import annotations

from .. import _shim_impl


def _walk_messages(messages, path=()):
    for md in messages:
        yield path + (md.name,), md
        yield from _walk_messages(md.nested, path + (md.name,))


def BuildMessageAndEnumDescriptors(file_desc, globals_dict) -> None:
    for path, md in _walk_messages(file_desc.messages):
        globals_dict["_" + "_".join(p.upper() for p in path)] = md
        for ed in md.enums:
            globals_dict[
                "_" + "_".join(p.upper() for p in path) + "_" + ed.name.upper()
            ] = ed
    for ed in file_desc.enums:
        globals_dict["_" + ed.name.upper()] = ed


def BuildTopDescriptorsAndMessages(
    file_desc, module_name: str, globals_dict
) -> None:
    classes_by_full_name: dict[str, type] = {}
    for path, md in _walk_messages(file_desc.messages):
        cls = _shim_impl.make_message_class(md)
        cls.__module__ = module_name
        classes_by_full_name[md.full_name] = cls
        if len(path) == 1:
            globals_dict[md.name] = cls
        else:
            # nested message classes hang off their parent class
            parent_full = md.full_name.rsplit(".", 1)[0]
            setattr(classes_by_full_name[parent_full], md.name, cls)
    _shim_impl.resolve_message_fields(classes_by_full_name)
    for ed in file_desc.enums:
        globals_dict[ed.name] = ed
        for vname, vnum in ed.values:
            globals_dict[vname] = vnum
