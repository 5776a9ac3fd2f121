from . import atom, csvrec, jsonld, literate, mermaid, ntriples, rdfs, simpleobj
