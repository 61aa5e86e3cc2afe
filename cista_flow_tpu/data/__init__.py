from . import augmentors, file_io
from .flying_chairs2 import FlyingChairs2
from .event_readers import (
    FixedSizeEventReader,
    RefTimeEventReaderZip,
    SingleEventReaderNpz,
)
from .io import (
    show_flow,
    show_whole_img,
    ErrorMapWriter,
    EvalWriter,
    EventWriter,
    FlowWriter,
    ImageWriter,
    VideoWriter,
    make_event_preview,
    merge_optical_flow,
)
from .prefetch import device_prefetch
from .train_loader import StackedSequenceLoader, TrainSequenceDataset
from .video_readers import VR, ImageReader, VideoReader, read_timestamps_file
