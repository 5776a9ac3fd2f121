from . import extract, kgpipeline, synth
