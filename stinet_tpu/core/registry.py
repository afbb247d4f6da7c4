"""Typed registries replacing the reference's globals()/getattr reflection
(train.py:45, parse_config.py:116-157). Components register under their
config `type` names, so the JSON config surface stays identical while lookup
is explicit and import-safe."""


class Registry:
    def __init__(self, kind: str):
        self.kind = kind
        self._items = {}

    def register(self, name=None):
        def deco(obj):
            self._items[name or obj.__name__] = obj
            return obj
        return deco

    def add(self, name, obj):
        self._items[name] = obj

    def get(self, name):
        if name not in self._items:
            raise KeyError(
                f"Unknown {self.kind} type {name!r}; known: "
                f"{sorted(self._items)}")
        return self._items[name]

    def __contains__(self, name):
        return name in self._items


TRAINERS = Registry("trainer")
DATALOADERS = Registry("data_loader")
MODELS = Registry("model")
TRANSFORMS = Registry("transform")
