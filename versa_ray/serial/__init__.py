from . import literate, ntriples
