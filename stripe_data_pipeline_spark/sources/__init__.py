"""Sources: Stripe-shaped schemas, fixtures and the REST connector."""
