package graft.model

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Full medical ontology catalog — every typed entity the reference
  * declares (models/src/medical/ — one case class per `pub struct`),
  * with the same ToVertex projection contract as graft.model.Medical:
  * every non-id field stringified into the properties map, the label is
  * the entity name. Rust type mapping: i32→Int, u32→Long, f32→Float,
  * DateTime<Utc>→Timestamp, NaiveDate→Date, Option<T>→Option[T],
  * Vec<String>→Seq[String], Uuid/Identifier→String.
  */
object Ontology {

  /** The shared projection: (id, label, stringified properties). */
  def toVertices(df: DataFrame, label: String): DataFrame = {
    val propCols = df.columns.filterNot(_ == "id").flatMap(c =>
      Seq(lit(c), col(c).cast("string")))
    df.select(col("id").cast("string").as("id"), lit(label).as("label"),
      map(propCols.toSeq: _*).as("properties"))
  }

  def vertices[T](ds: Dataset[T], label: String): DataFrame =
    toVertices(ds.toDF(), label)

  /** models/src/medical/address.rs */
  final case class Address(
      id: String,
      address_line1: String,
      address_line2: Option[String],
      city: String,
      state_province: String,
      postal_code: String,
      country: String)

  /** models/src/medical/billing_address.rs */
  final case class BillingAddress(
      id: Int,
      patient_id: Option[Int],
      address: Option[String],
      city: Option[String],
      state: Option[String],
      postal_code: Option[String],
      country: Option[String])

  /** models/src/medical/claim.rs */
  final case class Claim(
      id: Int,
      patient_id: Int,
      insurance_id: Int,
      date_of_service: java.sql.Timestamp,
      amount_billed: Float,
      amount_covered: Float,
      status: String)

  /** models/src/medical/clinical_note.rs */
  final case class ClinicalNote(
      id: Int,
      patient_id: Int,
      doctor_id: Int,
      note_text: String,
      created_at: java.sql.Timestamp,
      updated_at: java.sql.Timestamp)

  /** models/src/medical/department.rs */
  final case class Department(
      id: Int,
      hospital_id: Int,
      name: String,
      department_type: String,
      head_of_department_user_id: Option[Int],
      phone: Option[String],
      description: Option[String],
      created_at: java.sql.Timestamp,
      updated_at: java.sql.Timestamp)

  /** models/src/medical/diagnosis.rs */
  final case class Diagnosis(
      id: Int,
      patient_id: Int,
      doctor_id: Int,
      code_id: Int,
      description: String,
      date: java.sql.Date)

  /** models/src/medical/disposition.rs */
  final case class Disposition(
      id: Int,
      encounter_id: Int,
      patient_id: Int,
      disposition_type: String,
      admitting_service: Option[String],
      admitting_doctor_id: Option[Int],
      transfer_facility_id: Option[Int],
      discharge_instructions: Option[String],
      disposed_at: java.sql.Timestamp)

  /** models/src/medical/doctor.rs */
  final case class Doctor(
      id: Int,
      first_name: String,
      last_name: String,
      phone: String,
      email: String,
      specialization: String,
      license_number: String)

  /** models/src/medical/dosage.rs */
  final case class Dosage(
      id: Int,
      medication_id: Int,
      dosage_amount: String,
      dosage_frequency: String,
      created_at: java.sql.Timestamp,
      updated_at: Option[java.sql.Timestamp])

  /** models/src/medical/ed_event.rs */
  final case class EdEvent(
      id: Int,
      encounter_id: Int,
      event_type: String,
      event_description: Option[String],
      associated_entity_id: Option[Int],
      occurred_at: java.sql.Timestamp,
      recorded_by_user_id: Int)

  /** models/src/medical/ed_procedure.rs */
  final case class EdProcedure(
      id: Int,
      encounter_id: Int,
      patient_id: Int,
      procedure_code_id: Int,
      procedure_name: String,
      performed_by_doctor_id: Int,
      assist_nurse_id: Option[Int],
      start_time: java.sql.Timestamp,
      end_time: Option[java.sql.Timestamp],
      outcome: Option[String],
      notes: Option[String])

  /** models/src/medical/encounter.rs */
  final case class Encounter(
      id: Int,
      patient_id: Int,
      doctor_id: Int,
      encounter_type: String,
      date: java.sql.Timestamp,
      notes: Option[String])

  /** models/src/medical/event.rs */
  final case class Event(
      id: Int,
      patient_id: Int,
      event_type: String,
      event_date: java.sql.Timestamp,
      description: String)

  /** models/src/medical/facility_unit.rs */
  final case class FacilityUnit(
      id: Int,
      department_id: Int,
      name: String,
      unit_type: String,
      total_beds: Option[Int],
      current_occupancy: Option[Int],
      phone: Option[String],
      created_at: java.sql.Timestamp,
      updated_at: java.sql.Timestamp)

  /** models/src/medical/fhir_message.rs */
  final case class FHIRMessage(
      id: Int,
      message_type: String,
      message_content: String,
      received_date: java.sql.Timestamp,
      sent_date: Option[java.sql.Timestamp],
      status: String)

  /** models/src/medical/hl7_message.rs */
  final case class HL7Message(
      id: Int,
      message_type: String,
      message_content: String,
      received_date: java.sql.Timestamp,
      sent_date: Option[java.sql.Timestamp],
      status: String)

  /** models/src/medical/hospital.rs */
  final case class Hospital(
      id: Int,
      name: String,
      address_id: Int,
      phone: Option[String],
      website: Option[String],
      admin_contact_user_id: Option[Int],
      created_at: java.sql.Timestamp,
      updated_at: java.sql.Timestamp)

  /** models/src/medical/immunization.rs */
  final case class Immunization(
      id: Int,
      patient_id: Int,
      vaccine_name: String,
      administration_date: java.sql.Timestamp,
      administered_by: Option[Int],
      notes: Option[String])

  /** models/src/medical/insurance.rs */
  final case class Insurance(
      id: Int,
      name: String,
      contact_info: String,
      coverage_details: Option[String],
      claims_integration_status: String)

  /** models/src/medical/login.rs */
  final case class Login(
      id: Long,
      username: String,
      password: String,
      login_time: java.sql.Timestamp)

  /** models/src/medical/master_patient_index.rs */
  final case class MasterPatientIndex(
      id: Int,
      patient_id: Option[Int],
      first_name: Option[String],
      last_name: Option[String],
      date_of_birth: Option[java.sql.Timestamp],
      gender: Option[String],
      address: Option[String],
      contact_number: Option[String],
      email: Option[String],
      social_security_number: Option[String],
      match_score: Option[Float],
      match_date: Option[java.sql.Timestamp],
      created_at: java.sql.Timestamp,
      updated_at: java.sql.Timestamp)

  /** models/src/medical/medical_code.rs */
  final case class MedicalCode(
      id: Int,
      code: String,
      description: String,
      code_type: String,
      created_at: java.sql.Timestamp,
      updated_at: java.sql.Timestamp)

  /** models/src/medical/medical_interaction.rs */
  final case class MedicalInteraction(
      id: Int,
      primary_medication_id: Int,
      secondary_medication_id: Int)

  /** models/src/medical/medical_interaction_primary.rs */
  final case class MedicalInteractionPrimary(
      id: Int,
      medication_id: Int,
      interaction_name: String,
      interaction_class: String,
      description: Option[String])

  /** models/src/medical/medical_interaction_secondary.rs */
  final case class MedicalInteractionSecondary(
      id: Int,
      primary_medication_id: Int,
      secondary_medication_id: Int,
      severity: String,
      description: Option[String])

  /** models/src/medical/medical_record.rs */
  final case class MedicalRecord(
      id: Int,
      patient_id: Int,
      doctor_id: Int,
      record_type: Option[String],
      record_data: Option[String],
      created_at: java.sql.Timestamp,
      updated_at: java.sql.Timestamp)

  /** models/src/medical/medication.rs */
  final case class Medication(
      id: Int,
      name: String,
      brand_name: Option[String],
      generic_name: Option[String],
      medication_class: String)

  /** models/src/medical/nurse.rs */
  final case class Nurse(
      id: Int,
      user_id: Int,
      license_number: String,
      specialty: Option[String],
      years_of_experience: Int,
      created_at: java.sql.Timestamp,
      updated_at: java.sql.Timestamp)

  /** models/src/medical/observation.rs */
  final case class Observation(
      id: Int,
      encounter_id: Int,
      patient_id: Int,
      observation_type: String,
      value: String,
      unit: Option[String],
      observed_at: java.sql.Timestamp,
      observed_by_user_id: Int)

  /** models/src/medical/partner.rs */
  final case class Partner(
      id: Int,
      partner_type: String,
      name: String,
      contact_person_user_id: Option[Int],
      phone: Option[String],
      email: Option[String],
      address: Option[String],
      created_at: java.sql.Timestamp,
      updated_at: java.sql.Timestamp)

  /** models/src/medical/patient.rs */
  final case class Patient(
      id: Int,
      user_id: Option[Int],
      first_name: String,
      last_name: String,
      date_of_birth: java.sql.Timestamp,
      gender: String,
      address: Option[String],
      phone: Option[String],
      email: Option[String],
      created_at: java.sql.Timestamp,
      updated_at: java.sql.Timestamp)

  /** models/src/medical/patient_journey.rs */
  final case class PatientJourney(
      id: Int,
      patient_id: Int,
      encounter_id: Int,
      diagnosis_id: Int,
      prescription_id: Option[Int],
      vitals_id: Option[Int],
      timestamp: java.sql.Timestamp)

  /** models/src/medical/pharmacy.rs */
  final case class Pharmacy(
      id: Int,
      name: String,
      address: Option[String],
      contact_number: Option[String],
      email: Option[String],
      pharmacy_type: Option[String])

  /** models/src/medical/pharmacy_integration.rs */
  final case class PharmacyIntegration(
      id: Int,
      pharmacy_id: Int,
      prescription_id: Int,
      status: String,
      fulfillment_date: Option[java.sql.Timestamp])

  /** models/src/medical/prescription.rs */
  final case class Prescription(
      id: Int,
      patient_id: Int,
      doctor_id: Int,
      medication_name: String,
      dose: String,
      frequency: String,
      start_date: java.sql.Timestamp,
      end_date: Option[java.sql.Timestamp])

  /** models/src/medical/refill.rs */
  final case class Refill(
      id: Int,
      prescription_id: Int,
      date_requested: java.sql.Timestamp,
      date_fulfilled: Option[java.sql.Timestamp],
      status: String)

  /** models/src/medical/registration.rs */
  final case class Registration(
      id: Long,
      first: String,
      last: String,
      username: String,
      email: String,
      password: String,
      phone: String,
      role_id: Long,
      created_at: java.sql.Timestamp)

  /** models/src/medical/role.rs */
  final case class Role(
      id: Long,
      name: String,
      permissions: Seq[String],
      created_at: java.sql.Timestamp)

  /** models/src/medical/side_effect.rs */
  final case class SideEffect(
      id: Int,
      medication_id: Int,
      description: String,
      severity: String,
      onset: Option[String],
      duration: Option[String],
      created_at: java.sql.Timestamp,
      updated_at: java.sql.Timestamp)

  /** models/src/medical/social_determinant.rs */
  final case class SocialDeterminant(
      id: Int,
      patient_id: Int,
      factor_type: String,
      details: Option[String],
      recorded_by: Option[Int],
      recorded_at: java.sql.Timestamp)

  /** models/src/medical/staff_assignment.rs */
  final case class StaffAssignment(
      id: Int,
      user_id: Int,
      hospital_id: Int,
      department_id: Option[Int],
      facility_unit_id: Option[Int],
      assigned_role_id: Int,
      start_date: java.sql.Timestamp,
      end_date: Option[java.sql.Timestamp],
      is_active: Boolean,
      created_at: java.sql.Timestamp,
      updated_at: java.sql.Timestamp)

  /** models/src/medical/state_province.rs */
  final case class StateProvince(
      id: Int,
      name: String,
      code: String,
      country: Option[String])

  /** models/src/medical/triage.rs */
  final case class Triage(
      id: Int,
      encounter_id: Int,
      patient_id: Int,
      triage_nurse_id: Int,
      triage_level: String,
      chief_complaint: String,
      presenting_symptoms: Option[String],
      pain_score: Option[Int],
      triage_notes: Option[String],
      assessed_at: java.sql.Timestamp)

  /** models/src/medical/user.rs */
  final case class NewUser(
      first: String,
      last: String,
      username: String,
      email: String,
      password: String,
      phone: Option[String],
      role_id: Long)

  /** models/src/medical/user.rs */
  final case class User(
      id: String,
      first: String,
      last: String,
      username: String,
      email: String,
      password_hash: String,
      updated_at: java.sql.Timestamp,
      role_id: Long,
      phone: Option[String],
      created_at: java.sql.Timestamp,
      last_login: Option[java.sql.Timestamp])

  /** models/src/medical/vitals.rs */
  final case class Vitals(
      id: Int,
      patient_id: Int,
      weight: Option[Float],
      height: Option[Float],
      blood_pressure_systolic: Option[Int],
      blood_pressure_diastolic: Option[Int],
      temperature: Option[Float],
      heart_rate: Option[Int],
      created_at: java.sql.Timestamp)

  /** models/src/medical/x12edi_message.rs */
  final case class X12EDIMessage(
      id: Int,
      transaction_set_id: String,
      transaction_set_control_number: String,
      interchange_control_number: String,
      sender_id: String,
      receiver_id: String,
      message_content: String,
      received_date: java.sql.Timestamp,
      sent_date: Option[java.sql.Timestamp],
      status: String)

  /** Every vertex-projectable entity (has an id), as
    * label -> projection over an untyped DataFrame with the entity's
    * columns — lets callers register the whole catalog generically. */
  val labels: Seq[String] = Seq(
    "Address", "BillingAddress", "Claim", "ClinicalNote", "Department", "Diagnosis", "Disposition", "Doctor", "Dosage", "EdEvent", "EdProcedure", "Encounter", "Event", "FacilityUnit", "FHIRMessage", "HL7Message", "Hospital", "Immunization", "Insurance", "Login", "MasterPatientIndex", "MedicalCode", "MedicalInteraction", "MedicalInteractionPrimary", "MedicalInteractionSecondary", "MedicalRecord", "Medication", "Nurse", "Observation", "Partner", "Patient", "PatientJourney", "Pharmacy", "PharmacyIntegration", "Prescription", "Refill", "Registration", "Role", "SideEffect", "SocialDeterminant", "StaffAssignment", "StateProvince", "Triage", "User", "Vitals", "X12EDIMessage")
}