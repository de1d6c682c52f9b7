"""Minimal `unification.utils`."""


def transitive_get(key, d):
    """Follow chained bindings until a non-key value is reached."""
    while True:
        try:
            hashable = key in d
        except TypeError:  # unhashable value
            return key
        if not hashable:
            return key
        key = d[key]


def freeze(x):
    if isinstance(x, dict):
        return tuple(sorted((k, freeze(v)) for k, v in x.items()))
    if isinstance(x, (tuple, list, set)):
        return tuple(freeze(e) for e in x)
    return x
