import warnings
from functools import wraps


def experimental(obj):
    """Mark a class/function as experimental — warns once on first use
    (reference /root/reference/src/backbones/utils.py:4-14)."""
    warned = []

    if isinstance(obj, type):
        orig_init = obj.__init__

        @wraps(orig_init)
        def init(self, *args, **kwargs):
            if not warned:
                warnings.warn(f"{obj.__name__} is experimental and may "
                              "change or misbehave", stacklevel=2)
                warned.append(True)
            orig_init(self, *args, **kwargs)

        obj.__init__ = init
        return obj

    @wraps(obj)
    def wrapper(*args, **kwargs):
        if not warned:
            warnings.warn(f"{obj.__name__} is experimental and may change "
                          "or misbehave", stacklevel=2)
            warned.append(True)
        return obj(*args, **kwargs)

    return wrapper
