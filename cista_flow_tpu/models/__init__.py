from . import cista_lstc
