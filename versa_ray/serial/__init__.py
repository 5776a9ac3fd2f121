from . import csvrec, jsonld, literate, mermaid, ntriples, rdfs, simpleobj
