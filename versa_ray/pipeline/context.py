"""Pipeline context and deterministic ID generation.

The context threads one prototype link plus the doc-local input/output
models through rule actions (reference: pipeline/main.py:49-83). Two
deliberate departures for distributed determinism:

* ``idgen`` is a deterministic counter hash seeded by a per-document
  tint (reference datachefids.py:95-127 semantics with tint) — never a
  process-global random sequence, so any worker re-running a document
  produces identical IDs.
* ``existing_ids`` is doc-scoped only; cross-document reconciliation
  happens in the dedup shuffle (same-fingerprint => same ID => same
  links, so emit-everything + distinct is equivalent to the
  reference's insertion-order "first wins" — see SURVEY.md §7).
"""

from __future__ import annotations

from ..core import I, simple_hashstring
from ..model.micro import MicroModel


class deterministic_idgen:
    """Counter-hash ID sequence: hash(str(counter) + tint), mirroring
    the reference idgen coroutine protocol (send(text) => content hash;
    next() => counter hash)."""

    def __init__(self, base=None, tint=""):
        self.base = base
        self.tint = tint or ""
        self.counter = -1

    def send(self, to_hash):
        if to_hash is None:
            return self.__next__()
        out = simple_hashstring(to_hash)
        return self.base + out if self.base else out

    def __next__(self):
        out = simple_hashstring(str(self.counter) + self.tint)
        self.counter += 1
        return self.base + out if self.base else out

    def __iter__(self):
        return self


class context:
    """Versa pipeline context: current prototype link + models + scope."""

    transform_factory = MicroModel

    def __init__(
        self,
        current_link,
        input_model,
        output_model=None,
        base=None,
        variables=None,
        extras=None,
        idgen=None,
        existing_ids=None,
    ):
        self.current_link = current_link
        self.input_model = input_model
        self.output_model = (
            context.transform_factory() if output_model is None else output_model
        )
        self.base = base
        self.variables = variables or {}
        self.extras = extras if extras is not None else {}
        self.idgen = idgen or deterministic_idgen(base)
        self.existing_ids = existing_ids if existing_ids is not None else set()

    def copy(
        self,
        current_link=None,
        input_model=None,
        output_model=None,
        base=None,
        variables=None,
        extras=None,
        idgen=None,
        existing_ids=None,
    ):
        return context(
            current_link=current_link if current_link else self.current_link,
            input_model=self.input_model if input_model is None else input_model,
            output_model=self.output_model if output_model is None else output_model,
            base=base if base else self.base,
            variables=variables if variables else self.variables,
            extras=extras if extras else self.extras,
            idgen=idgen if idgen else self.idgen,
            existing_ids=existing_ids if existing_ids else self.existing_ids,
        )


_dummy_link = (None, I("https://example.org/"), None, {})
DUMMY_CONTEXT = context(_dummy_link, None)


def is_pipeline_action(f):
    return callable(f) and getattr(f, "is_pipeline_action", False)
