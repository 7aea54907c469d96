from .events import CommonMetricPrinter, EventStorage, JSONWriter, WandbWriter, WriterStack

__all__ = [
    "CommonMetricPrinter",
    "EventStorage",
    "JSONWriter",
    "WandbWriter",
    "WriterStack",
]
