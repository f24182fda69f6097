"""Train the Mask R-CNN body detector (reference ``main_detection.py`` skeleton)."""

from pets_face_recognition_tpu.engine import DetectionController

from main import main

if __name__ == "__main__":
    main(controller_cls=DetectionController)
