"""Model layer: cameras, the Gaussian map model, and the training step."""
