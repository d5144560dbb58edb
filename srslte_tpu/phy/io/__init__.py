from .filesource import FileSink, FileSource
from .net import NetSink, NetSource
