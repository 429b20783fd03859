from . import poly
