from . import cista_lstc, composite, dceiflow, eraft, idnet, raft
