"""Data layer: volume I/O, dataset loaders, slice extraction, caching.

Host-side counterpart of the reference `dataloaders/` + `utils/NII.py`
(see SURVEY.md section 2.3); the slice pools it produces live in device HBM
for the whole training run.
"""
