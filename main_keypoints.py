"""Train the Keypoint R-CNN head+landmark detector (reference ``main_keypoints.py``
skeleton)."""

from pets_face_recognition_tpu.engine import KeyPointsController

from main import main

if __name__ == "__main__":
    main(controller_cls=KeyPointsController)
