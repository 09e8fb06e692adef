"""gotenberg_ray — a Ray-Data-native crawl + document-conversion engine.

A from-scratch reimplementation of the capabilities of gotenberg/gotenberg
(reference at /root/reference) re-expressed Ray-Data-first:

- documents are rows of interleaved text+media *span lists* (Arrow
  ``list<struct<kind,text,media_ref,offset>>``) instead of working
  directories of files,
- every conversion route is a chain of ``map_batches`` transforms over
  zero-copy Arrow batches,
- stateful machinery (URL frontier, seen-set, politeness, robots,
  browser/office "supervisors") lives in actor pools,
- all wide steps are explicit, keyed shuffles.

Nothing here calls ``ray.init()``/``ray.shutdown()`` — the session is
owned by the driver / bench / test fixture.
"""

__version__ = "0.1.0"
