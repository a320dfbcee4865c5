"""Offline programs (SURVEY §3.2/§3.3): the reference's driver-side batch
pipelines recomposed as distributed plans."""
